from trck_spark.cli import main

raise SystemExit(main())

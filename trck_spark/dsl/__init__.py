from trck_spark.dsl.parser import ParseError, compile_tr

__all__ = ["compile_tr", "ParseError"]

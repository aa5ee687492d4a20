from dbitool_spark.functions.numeric import money, rate, dsum, davg

__all__ = ["money", "rate", "dsum", "davg"]

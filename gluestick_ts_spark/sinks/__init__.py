"""gluestick_ts_spark.sinks"""

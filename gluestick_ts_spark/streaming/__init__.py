"""gluestick_ts_spark.streaming"""

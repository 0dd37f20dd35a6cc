"""gluestick_ts_spark.sources"""

"""gluestick_ts_spark.operators"""

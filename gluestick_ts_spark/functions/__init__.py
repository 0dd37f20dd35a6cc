"""gluestick_ts_spark.functions"""

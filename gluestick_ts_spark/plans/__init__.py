"""gluestick_ts_spark.plans"""

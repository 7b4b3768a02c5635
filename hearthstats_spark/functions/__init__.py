from hearthstats_spark.functions.numeric import dsum, dcumsum, davg, round4, fsum_sql, favg_sql

__all__ = ["dsum", "dcumsum", "davg", "round4", "fsum_sql", "favg_sql"]

from hearthstats_spark.functions.numeric import (
    dsum, dcumsum, davg, dratio, round4, fsum_sql, favg_sql, fratio_sql,
)

__all__ = ["dsum", "dcumsum", "davg", "dratio", "round4",
           "fsum_sql", "favg_sql", "fratio_sql"]

from hearthstats_spark.functions.numeric import (
    dsum, dcumsum, davg, davg_signed, dratio, round4,
    fsum_sql, favg_sql, favg_signed_sql, fratio_sql,
)

__all__ = ["dsum", "dcumsum", "davg", "davg_signed", "dratio", "round4",
           "fsum_sql", "favg_sql", "favg_signed_sql", "fratio_sql"]

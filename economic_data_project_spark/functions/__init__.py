from .dialect import (  # noqa: F401
    approx_quantile,
    date_spine,
    dedup_latest,
    money,
    money_sum,
    rounded,
    safe_divide,
    safe_ln,
    unix_date,
)

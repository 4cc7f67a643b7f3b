from .money import money_sum, money_sum_sql
from .normalize import cnpj_normalize, etiqueta, strip_normalize, upper_trim
from .nulls import cast_decimals, coalesce_zero, fill_nulls_by_type
from .profile import profile_columns, profile_drift

__all__ = [
    "etiqueta",
    "strip_normalize",
    "cnpj_normalize",
    "upper_trim",
    "coalesce_zero",
    "cast_decimals",
    "fill_nulls_by_type",
    "money_sum",
    "money_sum_sql",
    "profile_columns",
    "profile_drift",
]

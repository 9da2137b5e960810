from fsc_etl_spark.functions.casting import CastSpec, cast_types  # noqa: F401
from fsc_etl_spark.functions.cleaning import (  # noqa: F401
    fill_zero,
    lowercase_first_letter_cols,
    rename_columns,
    uppercase_first_letter_cols,
)

from fsc_etl_spark.operators.cdc import snapshot_diff, split_inserts_updates  # noqa: F401
from fsc_etl_spark.operators.joins import dim_join, key_membership_join, star_left_join  # noqa: F401
from fsc_etl_spark.operators.keys import surrogate_keys  # noqa: F401
from fsc_etl_spark.operators.pivot import pivot_indicator  # noqa: F401
from fsc_etl_spark.operators.project import project, select_alias  # noqa: F401

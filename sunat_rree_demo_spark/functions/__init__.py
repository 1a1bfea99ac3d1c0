from sunat_rree_demo_spark.functions.months import (  # noqa: F401
    MONTH_NAMES_ES,
    month_name_es,
    month_num_from_name,
)
from sunat_rree_demo_spark.functions.scalars import (  # noqa: F401
    bucket_yoy,
    fmt_currency,
    in_year,
    inf_to_null,
    safe_div,
)

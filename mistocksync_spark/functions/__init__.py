from mistocksync_spark.functions.cleaning import (  # noqa: F401
    clean_invisible_chars,
    clean_article_vitya,
    clean_article_dimi,
    safe_color,
    strip_ws,
)
from mistocksync_spark.functions.codes import (  # noqa: F401
    bracket_code,
    battery_capacity,
    product_code_in_name,
    product_code_unified,
)
from mistocksync_spark.functions.pricing import (  # noqa: F401
    base_price_from_config,
    min_base_price,
    pct_change_match,
    pct_change_update,
)

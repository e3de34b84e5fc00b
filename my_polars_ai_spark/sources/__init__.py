from my_polars_ai_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
from my_polars_ai_spark.sources.readers import (  # noqa: F401
    from_csv,
    from_excel,
    from_json,
    from_parquet,
    from_records,
)

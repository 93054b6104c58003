"""Re-export the synthetic acquisition generator for tests."""

from gcf_corima_parquet_converter_spark.sources.synthetic import (  # noqa: F401
    SENSOR,
    make_dat_bytes,
    write_acquisition,
)

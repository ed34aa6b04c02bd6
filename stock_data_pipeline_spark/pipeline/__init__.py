from stock_data_pipeline_spark.pipeline.sector import (
    calculate_sector_price,
    calculate_sector_price_strict,
)

__all__ = ["calculate_sector_price", "calculate_sector_price_strict"]

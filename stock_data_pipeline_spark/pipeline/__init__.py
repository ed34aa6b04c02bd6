from stock_data_pipeline_spark.pipeline.sector import calculate_sector_price

__all__ = ["calculate_sector_price"]

"""LLM-training-data pipeline operators (extension surface).

Beyond the reference's own operators, these are the data-processing
primitives a 100 TB training-data pipeline needs: deduplication (exact
and near-dup), similarity search over embeddings, text analysis, and
multimodal (binary-column) plumbing. Pure DataFrame compositions where
possible; Arrow-batched Pandas UDFs only where Python is unavoidable.
"""

from stock_data_pipeline_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]

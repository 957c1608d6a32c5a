from .extract import extract_pipeline, fused_pipeline, summary_table

__all__ = ["extract_pipeline", "fused_pipeline", "summary_table"]

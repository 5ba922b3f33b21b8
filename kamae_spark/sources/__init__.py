from kamae_spark.sources.synth import annotations_table, transcripts_table

__all__ = ["transcripts_table", "annotations_table"]

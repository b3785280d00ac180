"""sparkclone — PySpark-native near-duplicate code detection + clustering.

A from-scratch rebuild of the capabilities of CloneHunter (reference
analyzed in SURVEY.md) as a batch Spark pipeline over a corpus table
``(repo, path, commit, lang, content)``. See pipeline.run_pipeline.
"""

from sparkclone.config import PipelineConfig, benchmark_config

__all__ = ["PipelineConfig", "benchmark_config"]
__version__ = "0.1.0"

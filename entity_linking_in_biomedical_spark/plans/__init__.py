from .pipeline import run_pipeline, PipelineConfig
from .resume import StageStore

__all__ = ["run_pipeline", "PipelineConfig", "StageStore"]

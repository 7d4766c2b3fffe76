from .pipeline import CdcPipeline

__all__ = ["CdcPipeline"]

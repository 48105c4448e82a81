"""End-to-end pipelines (the reference's examples/tutorials as jittable fns)."""

from .pipelines import (
    partition_pipeline,
    preprocess_pipeline,
    preprocess_pipeline_donating,
    rcm_pipeline,
    spmv_csr,
)

__all__ = ["preprocess_pipeline", "preprocess_pipeline_donating", "spmv_csr"]

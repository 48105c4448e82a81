"""End-to-end pipelines (the reference's examples/tutorials as jittable fns)."""

from .pipelines import (
    partition_pipeline,
    preprocess_pipeline,
    preprocess_pipeline_donating,
    rcm_pipeline,
    spmv,
    spmv_csr,
    spmv_ell,
)

__all__ = [
    "partition_pipeline",
    "preprocess_pipeline",
    "preprocess_pipeline_donating",
    "rcm_pipeline",
    "spmv",
    "spmv_csr",
    "spmv_ell",
]

"""Experiment harness (reference: examples/custom_experiment,
example_experiment — loaders x preprocesses x kernels x reps)."""

import numpy as np

from _common import parse_args

from sparsebase_tpu.experiment import (
    ConcreteExperiment,
    load_csr,
    pass_preprocess,
    reorder_csr,
)
from sparsebase_tpu.ops.reorder import DegreeReorder, RCMReorder


def spmv(data, fparams, pparams, kparams):
    csr = data
    x = np.ones(csr.ncols, np.float64)
    vals = (
        np.asarray(csr.vals, np.float64)
        if csr.vals is not None
        else np.ones(csr.nnz, np.float64)
    )
    out = np.zeros(csr.nrows)
    np.add.at(out, np.asarray(csr.row_of_nnz()), vals * x[np.asarray(csr.indices)])
    return out


def spmv_facade(data, fparams, pparams, kparams):
    """Format-polymorphic spmv() (the reference example's multi-kernel
    sweep analogue: same data, different kernel implementations)."""
    import numpy as np

    from sparsebase_tpu.models.pipelines import spmv as spmv_poly

    x = np.ones(data.ncols, np.float32)
    return np.asarray(spmv_poly(data, x))


def main():
    args = parse_args(__doc__)
    exp = ConcreteExperiment(warmup=0)
    exp.add_data_loader(load_csr, [([args.matrix], None)])
    exp.add_preprocess("pass", pass_preprocess)
    exp.add_preprocess("degree", reorder_csr(DegreeReorder))
    exp.add_preprocess("rcm", reorder_csr(RCMReorder))
    exp.add_kernel("spmv", spmv)
    exp.add_kernel("spmv_facade", spmv_facade)
    exp.run(times=3)
    for key, secs in sorted(exp.get_run_times().items()):
        print(f"{secs * 1e3:8.3f} ms  {key}")


if __name__ == "__main__":
    main()

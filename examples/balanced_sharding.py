"""nnz-balanced sharding on a row-skewed graph: the serpentine degree
deal keeps every row block near-equal nnz, so the padded width stops
following the worst shard (SURVEY.md §7 hard part 5). Runs on the
virtual 8-device CPU mesh."""

import numpy as np

from _common import parse_args  # noqa: F401  (keeps the example CLI uniform)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        print("needs XLA_FLAGS=--xla_force_host_platform_device_count=8; "
              "skipping (1 device found)")
        return
    import jax.numpy as jnp

    from sparsebase_tpu import COO
    from sparsebase_tpu.convert import coo_to_csr
    from sparsebase_tpu.parallel import ShardedCSR, halo, make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    n, nz = 20000, 200000
    zr = rng.zipf(1.3, nz) - 1
    zr = zr[zr < n].astype(np.int64)
    zc = rng.integers(0, n, len(zr)).astype(np.int64)
    keys = np.unique(zr * n + zc)
    csr = coo_to_csr(COO.new(
        (keys // n).astype(np.int32), (keys % n).astype(np.int32), None,
        shape=(n, n)))

    natural = ShardedCSR.from_csr(csr, mesh, halo=False)
    balanced, order = ShardedCSR.from_csr_balanced(csr, mesh, halo=True)
    print(f"padded-width ratio: natural {natural.padded_width_ratio():.2f} "
          f"-> balanced {balanced.padded_width_ratio():.2f}")

    # every sharded kernel runs unchanged on the balanced container;
    # map results back through the layout order
    x = jnp.ones((n,), jnp.float32)
    y = np.asarray(halo.spmv(balanced, x, mesh))
    print("spmv on balanced container:", y.shape, "sum", float(y.sum()))


if __name__ == "__main__":
    main()

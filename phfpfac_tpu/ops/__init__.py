from phfpfac_tpu.ops.reference_jnp import scan_shard_jnp  # noqa: F401

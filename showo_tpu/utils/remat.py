"""Shared rematerialization-policy wrapper for layer stacks.

The v1 tower (models/phi.py) grew these knobs first; this helper gives
the v2 towers (show_o2/qwen2.py, show_o2/dit.py) the same ladder:

  False/"none"/None — no remat (fastest when activations fit HBM)
  True/"full"       — jax.checkpoint, recompute the whole layer
  "dots"            — save matmul outputs, recompute norms/elementwise
  "qkv"             — save only outputs tagged "qkv_out"
  "qkv_fc1"         — save "qkv_out" + "fc1_out"

The named policies rest on jax.ad_checkpoint.checkpoint_name tags placed
at the projection outputs inside each layer body.
"""

import jax


def wrap_remat(fn, remat, static_argnums=(0,)):
    if remat in (False, "none", None):
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn, static_argnums=static_argnums,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "qkv":
        return jax.checkpoint(
            fn, static_argnums=static_argnums,
            policy=jax.checkpoint_policies.save_only_these_names("qkv_out"))
    if remat == "qkv_fc1":
        return jax.checkpoint(
            fn, static_argnums=static_argnums,
            policy=jax.checkpoint_policies.save_only_these_names(
                "qkv_out", "fc1_out"))
    # True / "full"
    return jax.checkpoint(fn, static_argnums=static_argnums)

"""Shared rematerialization-policy wrapper for layer stacks.

The v1 tower (models/phi.py) grew these knobs first; this helper gives
the v2 towers (show_o2/qwen2.py, show_o2/dit.py) the same ladder:

  False/"none"/None — no remat (fastest when activations fit HBM)
  True/"full"       — jax.checkpoint, recompute the whole layer
  "dots"            — save matmul outputs, recompute norms/elementwise
  "qkv"             — save only outputs tagged "qkv_out"
  "qkv_fc1"         — save "qkv_out" + "fc1_out"
  "qkv_attn"        — save "qkv_out" + "attn_out" (post-attention rows)
  "qkv_fc1_attn"    — all matmul outputs; recompute only norms/
                      elementwise + the S x S attention internals

The named policies rest on jax.ad_checkpoint.checkpoint_name tags placed
at the projection outputs inside each layer body.

prevent_cse=False throughout: every wrap site here is a layer body under
``lax.scan``, where CSE between the forward and the recompute cannot
happen across the scan boundary (the jax.checkpoint docstring blesses
exactly this).  The default prevent_cse=True wraps the recompute in
optimization barriers that both slow the compiled step AND blow up
XLA compile memory/time — the r4 "qkv_attn crashes the remote compile
service / qkv+adafactor exceeds the 900 s compile budget" failures.
"""

import functools

import jax


def wrap_remat(fn, remat, static_argnums=(0,)):
    ckpt = functools.partial(jax.checkpoint, fn, prevent_cse=False,
                             static_argnums=static_argnums)
    if remat in (False, "none", None):
        return fn
    if remat == "dots":
        return ckpt(
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    if remat == "qkv":
        return ckpt(
            policy=jax.checkpoint_policies.save_only_these_names("qkv_out"))
    if remat == "qkv_fc1":
        return ckpt(policy=jax.checkpoint_policies.save_only_these_names(
            "qkv_out", "fc1_out"))
    if remat == "qkv_attn":
        return ckpt(policy=jax.checkpoint_policies.save_only_these_names(
            "qkv_out", "attn_out"))
    if remat == "qkv_fc1_attn":
        # near-remat-free: matmul outputs saved, backward recomputes
        # only norms/elementwise + the S x S attention internals
        return ckpt(policy=jax.checkpoint_policies.save_only_these_names(
            "qkv_out", "fc1_out", "attn_out"))
    # True / "full"
    return ckpt()

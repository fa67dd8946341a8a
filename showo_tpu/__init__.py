"""showo_tpu — a TPU-native (JAX/XLA/Pallas) unified multimodal framework.

Re-implements the full capability surface of showlab/Show-o (discrete unified
model: Phi-1.5 LLM + MAGVIT-v2 LFQ tokens, MaskGIT discrete diffusion + AR
text) and Show-o2 (continuous unified model: Qwen2.5 LLM + Wan2.1 3D causal
VAE latents, flow matching via a DiT head) as an idiomatic JAX framework:

* all compute paths are pure functions over explicit parameter pytrees,
  jit-compiled with static shapes;
* attention masks ("omni attention") are computed vectorized on device
  (the reference builds them with per-sample python loops);
* sampling loops (MaskGIT, AR decode, ODE flow integration) are
  ``jax.lax.scan``/``fori_loop`` bodies inside a single compiled program;
* parallelism is expressed with ``jax.sharding`` over a device Mesh
  (data / fsdp / tensor axes) instead of NCCL/DeepSpeed;
* hot kernels (block-sparse omni attention) have Pallas implementations.
"""

__version__ = "0.1.0"

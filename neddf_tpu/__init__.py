"""neddf_tpu — TPU-native Neural Density-Distance Fields framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ueda0319/neddf (NeDDF, ECCV 2022, arXiv:2207.14455): neural-field scene
representations (NeDDF / NeRF / NeuS) trained from posed multi-view images
via differentiable volume rendering.

Design stance (vs. the PyTorch reference at /root/reference):

* The reference's hand-written forward-mode "with_grad" dual-pair layers
  (neddf/nn_module/with_grad/) become a dense *dual tensor* ``[M, 4, C]``
  (1 value row + 3 spatial-tangent rows) so each MLP layer is a single
  ``[4M, C] x [C, C']`` MXU matmul. Reverse-mode differentiation through
  the Jacobian (needed because density is computed from the distance
  field's spatial gradient) falls out of JAX autodiff for free.
* Classes holding mutable state (Camera, warmup counters) become pytrees
  plus pure functions; warmup schedules are explicit scalar inputs to the
  jitted step.
* Parallelism: ray batches shard over a ``jax.sharding.Mesh`` (pure DP --
  rays are embarrassingly parallel), params replicated, psum for grads,
  all_gather of rendered tiles. See ``neddf_tpu.parallel``.
* The Hydra config surface of the reference (config/{dataset,network,
  render,trainer,loss} with ``_target_`` keys) is preserved by a small
  YAML compose/instantiate layer in ``neddf_tpu.config``.
"""

__version__ = "0.1.0"

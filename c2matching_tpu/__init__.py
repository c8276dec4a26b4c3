"""c2matching_tpu: a TPU-native (JAX/XLA/Pallas/pjit) reference-based
super-resolution framework with the capabilities of yumingj/C2-Matching.

Layer map (TPU-first redesign of the reference's stack, see SURVEY.md):

- ``ops``       : custom compute primitives (patch matching, modulated
                  deformable convolution) as pure-XLA formulations plus Pallas
                  TPU kernels. Replaces the reference's CUDA extensions
                  (mmsr/models/archs/DCNv2, mmsr/models/archs/dcn).
- ``models``    : flax.linen network architectures (NHWC layouts) and
                  functional stage-models (jitted train/eval step functions).
- ``data``      : host-side data pipeline (PIL-bicubic faithful) feeding
                  device buffers.
- ``parallel``  : device-mesh / sharding utilities (data parallelism over a
                  ``jax.sharding.Mesh``).
- ``utils``     : YAML option parsing, registry, logging, metrics.
"""

__version__ = '0.1.0'

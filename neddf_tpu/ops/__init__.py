from neddf_tpu.ops.activations import (  # noqa: F401
    ACTIVATIONS,
    leaky_relu,
    relu,
    softplus,
    tanh_exp,
)
from neddf_tpu.ops.dual import (  # noqa: F401
    act_dual,
    dual_jacobian,
    dual_value,
    linear_dual,
    pack_dual,
    pe_dual,
    pe_dual_directional_mip,
    pe_dual_planes_mip,
)
from neddf_tpu.ops.pe import (  # noqa: F401
    pe_frequencies,
    pe_grad_scale,
    pe_lowpass_scale,
    pe_packed,
    pe_weights,
    positional_encoding,
    positional_encoding_mip,
)
from neddf_tpu.ops.sampling import sample_pdf, stratified_dists  # noqa: F401
from neddf_tpu.ops.compositing import integrate_volume_render  # noqa: F401

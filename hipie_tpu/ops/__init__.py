from hipie_tpu.ops.ms_deform_attn import ms_deform_attn, ms_deform_attn_jnp
from hipie_tpu.ops import box_ops

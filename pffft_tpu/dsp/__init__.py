"""PFDSP parity: NCO mixers, carrier generators, CIC decimation.

TPU-native re-design of the reference's pf_mixer/pf_carrier/pf_cic
(/root/reference/src/pf_{mixer,carrier,cic}.cpp).
"""

from .mixer import (
    mixer_apply_split,
    MixerState,
    mixer_init,
    mixer_apply,
    Mixer,
    shift_math_cc,
    shift_table_init,
    shift_table_cc,
    shift_addfast_init,
    shift_addfast_cc,
    shift_unroll_init,
    shift_unroll_cc,
    shift_limited_unroll_init,
    shift_limited_unroll_cc,
    shift_recursive_osc_init,
    shift_recursive_osc_cc,
    gen_recursive_osc_c,
    have_sse_shift_mixer_impl,
)
from .carrier import (
    generate_dc_f,
    generate_dc_s16,
    generate_pos_fs4_f,
    generate_pos_fs4_s16,
    generate_neg_fs4_f,
    generate_neg_fs4_s16,
    generate_dc_pos_fs4_s16,
    generate_dc_neg_fs4_s16,
    generate_pos_neg_fs4_s16,
    generate_dc_pos_neg_fs4_s16,
    generate_pos_neg_fs2_s16,
    generate_dc_pos_neg_fs2_s16,
)
from .cic import CicState, cicddc_init, cicddc_apply, CicDDC

__all__ = [
    "MixerState", "mixer_init", "mixer_apply", "mixer_apply_split", "Mixer",
    "shift_math_cc", "shift_table_init", "shift_table_cc",
    "shift_addfast_init", "shift_addfast_cc",
    "shift_unroll_init", "shift_unroll_cc",
    "shift_limited_unroll_init", "shift_limited_unroll_cc",
    "shift_recursive_osc_init", "shift_recursive_osc_cc", "gen_recursive_osc_c",
    "have_sse_shift_mixer_impl",
    "generate_dc_f", "generate_dc_s16",
    "generate_pos_fs4_f", "generate_pos_fs4_s16",
    "generate_neg_fs4_f", "generate_neg_fs4_s16",
    "generate_dc_pos_fs4_s16", "generate_dc_neg_fs4_s16",
    "generate_pos_neg_fs4_s16", "generate_dc_pos_neg_fs4_s16",
    "generate_pos_neg_fs2_s16", "generate_dc_pos_neg_fs2_s16",
    "CicState", "cicddc_init", "cicddc_apply", "CicDDC",
]

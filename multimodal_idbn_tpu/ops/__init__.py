"""Functional TPU compute path: sampling, schedules, RBM ops, Pallas kernels."""

from multimodal_idbn_tpu.ops.rbm_ops import (  # noqa: F401
    RBMState,
    cd_update,
    clamped_cd_update,
    conditional_gibbs,
    conditional_gibbs_annealed,
    free_energy,
    gibbs_step,
    hidden_probs,
    init_rbm_state,
    noisy_meanfield_annealed,
    visible_logits,
    visible_probs,
)
from multimodal_idbn_tpu.ops.sampling import (  # noqa: F401
    apply_softmax_groups,
    clamp_mask,
    sample_bernoulli,
    sample_categorical_onehot,
    sample_visible,
)

"""Diagnostics & observability: probes, plots, energy, convergence tracing.

Re-exports mirror reference imdbn/utils/__init__.py:5-14.
"""

from multimodal_idbn_tpu.utils.pca import PCA, pca_fit_transform  # noqa: F401
from multimodal_idbn_tpu.utils.probe_utils import (  # noqa: F401
    compute_joint_embeddings_and_features,
    compute_val_embeddings_and_features,
    log_joint_linear_probe,
    log_linear_probe,
    make_bin_labels,
    stratified_split,
    train_linear_classifier,
)
from multimodal_idbn_tpu.utils.wandb_utils import (  # noqa: F401
    log_barplot,
    log_reconstructions_to_wandb,
    make_grid,
    plot_2d_embedding_and_correlations,
    plot_3d_embedding_and_correlations,
)

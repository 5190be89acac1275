from .prd_score import (  # noqa: F401
    compute_prd, compute_prd_from_embedding, prd_to_max_f_beta_pair, plot)

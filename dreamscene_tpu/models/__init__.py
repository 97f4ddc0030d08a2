from dreamscene_tpu.models.gaussians import (
    GaussianParams,
    GaussianAux,
    GaussianState,
    AdamState,
    create_from_points,
    adam_init,
    adam_update,
    num_active,
)

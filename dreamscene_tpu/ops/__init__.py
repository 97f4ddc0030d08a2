from dreamscene_tpu.ops.sh import eval_sh, RGB2SH, SH2RGB, num_sh_coeffs
from dreamscene_tpu.ops.quaternion import (
    quaternion_raw_multiply,
    quaternion_multiply,
    quaternion_invert,
    standardize_quaternion,
    quaternion_to_matrix,
    matrix_to_quaternion,
)
from dreamscene_tpu.ops.transforms import (
    euler_angles_to_matrix,
    sh_band_rotation_matrix,
    rotate_sh,
)
from dreamscene_tpu.ops.covariance import (
    build_rotation,
    build_scaling_rotation,
    build_covariance_3d,
    strip_symmetric,
)
from dreamscene_tpu.ops.losses import tv_loss, l1_loss, l2_loss, ssim, safe_normalize

from dreamscene_tpu.cameras.camera import (
    Camera,
    get_world2view,
    get_projection_matrix,
    fov2focal,
    focal2fov,
    get_rays,
)

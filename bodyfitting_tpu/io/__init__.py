"""Host-side IO: OpenPose JSON, OBJ meshes, cameras, parameters, images."""

from bodyfitting_tpu.io.openpose import (  # noqa: F401
    load_openpose,
    load_openpose_dir,
    pack_keypoints,
)
from bodyfitting_tpu.io.obj import ObjMesh, load_obj, save_obj, save_obj_uv  # noqa: F401
from bodyfitting_tpu.io.images import (  # noqa: F401
    imread_checked,
    mask_square_bbox,
    crop_and_resize,
    adjust_K_for_crop,
    apply_mask,
    bbox_from_keypoints,
)
from bodyfitting_tpu.io.params import (  # noqa: F401
    save_params,
    load_params,
    save_fit_outputs,
    to_numpy_result,
)
from bodyfitting_tpu.io.cameras import (  # noqa: F401
    load_annots,
    save_annots,
    genebody_views,
    GENEBODY_MISSING_VIEWS,
)

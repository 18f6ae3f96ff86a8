from d3human_tpu.models.smplx.lbs import (  # noqa: F401
    batch_rodrigues, batch_rigid_transform, blend_shapes, lbs, vertices2joints,
)
from d3human_tpu.models.smplx.model import SMPLXModel, load_smplx_npz, synthetic_body_model  # noqa: F401
from d3human_tpu.models.smplx.deformer import SMPLXDeformer  # noqa: F401

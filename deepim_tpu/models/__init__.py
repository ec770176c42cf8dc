from deepim_tpu.models.flownet import (  # noqa: F401
    FlowNetDeepIM,
    assemble_input,
    fixed_bilinear_upsample,
)

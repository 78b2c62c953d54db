from yolo_ms_tpu.nn.blocks import (  # noqa: F401
    ConvBnSiLU,
    Bottleneck,
    C2f,
    SPPF,
    MSBlock,
    MSSPPF,
    MSFusion,
    SqueezeExcite,
    upsample2x,
    dfl_expectation,
    yolo_params,
)

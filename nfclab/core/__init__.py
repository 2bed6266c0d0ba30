from .frame import (
    Frame,
    FrameTech,
    FrameType,
    FramePhase,
    FrameFlags,
)

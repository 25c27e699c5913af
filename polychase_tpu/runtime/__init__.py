from .threads import (  # noqa: F401
    OpticalFlowProgress,
    OpticalFlowRequest,
    OpticalFlowThread,
    RefinerThread,
    TrackerThread,
)

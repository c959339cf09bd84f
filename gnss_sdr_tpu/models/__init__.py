from .constellation import (  # noqa: F401
    BEIDOU_B1I,
    GALILEO_E1B,
    GALILEO_E1C,
    GLONASS_L1OF,
    GPS_L1CA,
    REGISTRY,
    SignalSpec,
    get_signal,
)
from .signal import SatelliteScenario, synthesize, synthesize_real_if_int8  # noqa: F401

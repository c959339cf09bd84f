from . import beidou_b1i, galileo_e1, glonass_l1of, gps_l1ca  # noqa: F401

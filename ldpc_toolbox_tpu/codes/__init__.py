from . import ccsds, dvbs2, nr5g  # noqa: F401

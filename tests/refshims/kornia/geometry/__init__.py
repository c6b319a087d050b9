from kornia.geometry import conversions, subpix  # noqa: F401

"""kornia shim: the handful of ops the reference calls, implemented from
kornia's documented semantics."""

from kornia import geometry, utils  # noqa: F401

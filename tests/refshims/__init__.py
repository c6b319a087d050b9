"""Minimal stand-ins for third-party packages the reference imports.

The real-module parity tests (tests/test_real_parity.py) instantiate the
actual torch reference models from /root/reference on CPU. Those modules
import a handful of packages not present in this environment (loguru,
yacs, kornia, torchvision, pytorch_lightning); each shim here implements
just the public API surface the reference touches — written from the
upstream packages' documented behavior, not their code.

Use tests.refloader.reference_paths() to put this directory on sys.path
ahead of the reference repo roots.
"""

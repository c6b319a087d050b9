"""yacs shim (see yacs.config)."""

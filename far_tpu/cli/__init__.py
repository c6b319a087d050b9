"""Command-line entry points (reference L8):

  python -m far_tpu.cli.train        -- data-parallel training
  python -m far_tpu.cli.evaluate     -- batched eval + metric tables
  python -m far_tpu.cli.demo         -- single-pair pose inference
  python -m far_tpu.cli.submission   -- map-free submission writer
  python -m far_tpu.cli.precompute   -- matcher correspondence shards
  python -m far_tpu.eval.mapfree_benchmark  -- offline submission scorer
"""

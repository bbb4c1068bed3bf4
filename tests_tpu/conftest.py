"""Real-TPU test configuration.

Unlike tests/ (which forces the CPU backend + virtual mesh), this directory
runs against the session's real TPU chip: the environment's sitecustomize
preselects the TPU platform, so no override here.  Every test must skip
itself when the backend is not TPU (CI boxes without a chip).

Run with:  python -m pytest tests_tpu/ -q
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

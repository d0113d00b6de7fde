"""Pallas TPU kernels (rebuild-added; SURVEY native-code inventory: the
reference has no native ops, so the TPU-native work is Pallas fusion of the
hot blocks).  Every kernel has an XLA fallback that doubles as its test
oracle; `use_pallas` in RunConfig (or explicit calls) selects the path."""


def tpu_pallas_available() -> bool:
    """True when a pallas_call can actually execute: a real TPU backend, or
    TPU-interpret mode forced (tests on CPU).  Auto-dispatch helpers gate on
    this so ``use_pallas=true`` on a CPU/GPU host falls back to the XLA
    oracle instead of dying in Mosaic lowering."""
    import jax
    if jax.default_backend() == "tpu":
        return True
    try:
        # thread-local set by pltpu.force_tpu_interpret_mode (private but
        # stable enough for a test-only affordance; any failure -> False)
        from jax._src import config as _jcfg
        return (_jcfg.pallas_tpu_interpret_mode_context_manager.value
                is not None)
    except Exception:  # pragma: no cover - jax internals moved
        return False


from mcmda_tpu.kernels import fused_conv  # noqa: E402,F401

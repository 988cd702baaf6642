"""Pallas TPU kernels for the hot ops."""


def clear_kernel_caches() -> None:
    """Drop every kernel wrapper's jit cache.

    The quant env gate is resolved unjitted (part of the cache key), so
    this is NOT needed when flipping RDST_TPU_PALLAS_QUANT — it exists
    for the remaining trace-time reads (RDST_TPU_PALLAS_PRECISE,
    RDST_TPU_PALLAS_SOFTMAX, VMEM budget monkeypatches) and as the one
    place that knows every cached wrapper (multi-config drivers call it
    between records). Flipping the softmax variant WITHOUT clearing
    keeps serving the previously traced variant.
    """
    from rdst_tpu.kernels import rdstb_block, swin_block

    swin_block.fused_swin_block.clear_cache()
    swin_block.fused_swin_pair.clear_cache()
    rdstb_block.fused_rdstb.clear_cache()

from gdrnet_tpu.data.synthetic import synthetic_roi_batch

__all__ = ["synthetic_roi_batch"]

from gdrnet_tpu.ops import rotation, pose, warp, fps, symmetry

__all__ = ["rotation", "pose", "warp", "fps", "symmetry"]

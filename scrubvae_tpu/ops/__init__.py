from scrubvae_tpu.ops import kinematics, losses, quaternion, rotation

__all__ = ["kinematics", "losses", "quaternion", "rotation"]

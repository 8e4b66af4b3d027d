from .schedule import NoiseSchedule, polynomial_alphas2, interp_lin

__all__ = ["NoiseSchedule", "polynomial_alphas2", "interp_lin"]

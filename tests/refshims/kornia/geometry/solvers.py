"""kornia.geometry.solvers shim: import-time names for
prior_ransac/cv_geometry.py. Only run_5point_our_kornia consumes these
polynomial helpers; the cross-validation drives the reference engine
through its 8-point ('fundamental') solver, so calls raise."""


def _unavailable(*_a, **_k):
    raise NotImplementedError(
        "kornia polynomial solvers are not shimmed; use the reference's "
        "'fundamental' (8-point) model type")


multiply_deg_one_poly = _unavailable
multiply_deg_two_one_poly = _unavailable
determinant_to_polynomial = _unavailable
solve_cubic = _unavailable
solve_quadratic = _unavailable

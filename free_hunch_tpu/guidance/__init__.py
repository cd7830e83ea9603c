# Conditioning mechanisms are imported lazily to keep the core (covariance,
# solvers) importable on their own.

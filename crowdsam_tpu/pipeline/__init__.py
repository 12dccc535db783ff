"""Pipeline layer: predictor, EPS decode engine, CrowdSAM shell, AMG."""

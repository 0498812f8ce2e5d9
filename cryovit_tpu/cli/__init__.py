"""User-facing CLI: ``cryovit {features, train, evaluate, infer}``."""

"""Physical-plan inspection: the engine's plan-quality contract."""

"""Physical-plan inspection: the engine's scale assertions live here."""

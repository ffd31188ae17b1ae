"""fairscale stub for golden dumps (see xformers stub docstring)."""

"""The VO pipeline: jitted tracking step (frontend), local-BA backend, and
the host-side system orchestrator."""

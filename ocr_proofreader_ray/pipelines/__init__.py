"""End-to-end pipelines composed from stages; no ``ray.init`` anywhere."""

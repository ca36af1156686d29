"""Host-side utilities: image transforms, observability, capture tooling."""

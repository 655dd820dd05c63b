"""Host-side support: image IO, profiling, properties/config."""

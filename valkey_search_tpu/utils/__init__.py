"""Host-side data-structure substrate (reference src/utils/)."""

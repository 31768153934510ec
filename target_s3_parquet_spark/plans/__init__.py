"""Schema/plan-level transforms: JSON-Schema → StructType conversion and
the recursive ``parent__child`` flatten projection generator (the
reference's signature transform, re-expressed as a pure ``select``)."""

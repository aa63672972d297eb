// Intentionally empty: the reference's malloc interposition is irrelevant
// to the baseline measurement (scripts/ref_baseline.py).
#pragma once

PYTHON_3_7_QUOTING = object()

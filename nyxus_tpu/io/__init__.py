"""I/O: image readers, dataset assembly, output writers."""

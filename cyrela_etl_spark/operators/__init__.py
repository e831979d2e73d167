"""Engine operators: wallet feature pipeline + LLM-data-pipeline extensions."""

"""Engine operators: replay/enrichment parity + LLM-pipeline extensions."""

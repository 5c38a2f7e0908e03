"""Engine operators: schema evolution, relational extensions, LLM-pipeline ops."""

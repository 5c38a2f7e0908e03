"""Plan inspection: assert the physical plans the 100 TB target needs."""

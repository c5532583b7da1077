"""Result plotting and tabulation (the reference's plots/ tooling)."""

#![allow(deprecated)]
use xorf::{Fuse8, Fuse16, Fuse32};
fn main() {
    const MULT: u64 = 0x9E37_79B9_7F4A_7C15;
    for n in [10_000u64, 20_000, 30_000, 50_000, 100_000] {
        let keys: Vec<u64> = (1..=n).map(|i| i.wrapping_mul(MULT)).collect();
        let r8 = Fuse8::try_from(&keys).is_ok();
        let r16 = Fuse16::try_from(&keys).is_ok();
        let r32 = Fuse32::try_from(&keys).is_ok();
        eprintln!("n={n}: fuse8={r8} fuse16={r16} fuse32={r32}");
    }
}

// no-op profiling stub for the reference test suite
pub struct TimeLapse;
#[macro_export]
macro_rules! profile_start { ($n:ident) => { let $n = std::time::Instant::now(); }; }
#[macro_export]
macro_rules! profile_end_print {
    ($n:ident) => { println!("{}: {} ns", stringify!($n), $n.elapsed().as_nanos()); };
}

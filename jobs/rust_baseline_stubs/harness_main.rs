use xhtml_parser::document::Document;

fn main() {
    let args: Vec<String> = std::env::args().collect();
    if args.len() > 1 && args[1] == "--pipe" {
        pipe_mode();
        return;
    }
    let file = &args[1];
    let mode = if args.len() > 2 { args[2].clone() } else { "cold".into() };
    let contents = std::fs::read(file).expect("read");
    if mode == "verify" {
        let document = Document::new(contents).expect("parse");
        // cross-check hook: node count + total text bytes must match
        // the Python/C kernel's numbers for the same file
        let n_nodes = document.last_node_idx();
        let mut text_bytes = 0usize;
        let mut n_text = 0usize;
        for node in document.all_nodes() {
            if node.is_text() {
                n_text += 1;
                text_bytes += node.text().map(|t| t.len()).unwrap_or(0);
            }
        }
        println!("last_node_idx={} n_text={} text_bytes={}", n_nodes, n_text, text_bytes);
    } else if mode == "cold" {
        let start = std::time::Instant::now();
        let document = Document::new(contents);
        let d = start.elapsed();
        println!("{}", d.as_nanos());
        assert!(document.is_ok());
    } else {
        let warm_runs: usize = mode.parse().unwrap();
        let mut best = u128::MAX;
        for _ in 0..warm_runs {
            let c = contents.clone();
            let start = std::time::Instant::now();
            let document = Document::new(c);
            let d = start.elapsed().as_nanos();
            assert!(document.is_ok());
            if d < best { best = d; }
        }
        println!("{}", best);
    }
}

// pipe mode (differential fuzzing): read length-prefixed documents on
// stdin, answer with length-prefixed results -- "OK " + the Debug
// tree (the same formatter the golden .result files pin) on success,
// "ERR " + the error Debug on failure. Used by
// jobs/fuzz_vs_reference.py to compare the repo kernels against the
// reference's own binary on millions of random documents.

fn pipe_mode() {
    use std::io::{Read, Write};
    let mut stdin = std::io::stdin().lock();
    let mut stdout = std::io::stdout().lock();
    let mut len_buf = [0u8; 4];
    loop {
        match stdin.read_exact(&mut len_buf) {
            Ok(()) => {}
            Err(_) => break, // EOF
        }
        let n = u32::from_le_bytes(len_buf) as usize;
        let mut doc = vec![0u8; n];
        stdin.read_exact(&mut doc).expect("doc body");
        let out = match Document::new(doc) {
            Ok(d) => format!("OK {:#?}", d),
            Err(e) => format!("ERR {:?}", e),
        };
        let ob = out.as_bytes();
        stdout.write_all(&(ob.len() as u32).to_le_bytes()).unwrap();
        stdout.write_all(ob).unwrap();
        stdout.flush().unwrap();
    }
}
